from .distributions import MixtureOfGaussians

__all__ = ["MixtureOfGaussians"]
