"""Model layer: U-Net backbone, likelihood heads, ConvNP."""

from deepsensornz_tpu.models.unet import UNet  # noqa: F401
from deepsensornz_tpu.models.likelihoods import get_likelihood, Likelihood  # noqa: F401
from deepsensornz_tpu.models.convnp import ConvNP, ConvNPConfig  # noqa: F401
