from .dataset import (CarlaSeg, CarlaSegPred, BatchLoader, imread, crop_resize,
                      preprocess_measurements)

__all__ = ["CarlaSeg", "CarlaSegPred", "BatchLoader", "imread", "crop_resize",
           "preprocess_measurements"]
