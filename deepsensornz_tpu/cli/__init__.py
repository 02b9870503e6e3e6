"""Command-line entry points (training + operational inference)."""
