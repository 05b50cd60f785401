from .model import AvatarModel, TrainState

__all__ = ["AvatarModel", "TrainState"]
