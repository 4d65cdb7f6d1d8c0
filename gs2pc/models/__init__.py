from gs2pc.models.gaussians import Gaussians

__all__ = ["Gaussians"]
