"""Pipeline layer: preprocess → train → validate orchestration
(rebuild of ``nzdownscale/downscaler/``)."""

from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling  # noqa: F401
