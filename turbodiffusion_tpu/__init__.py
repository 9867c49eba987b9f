"""TurboDiffusion-TPU: TPU-native video diffusion acceleration framework."""

__version__ = "0.1.0"
