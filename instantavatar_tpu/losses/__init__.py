from .nerf_loss import hard_surface_reg, nerf_loss, ngp_loss

__all__ = ["hard_surface_reg", "nerf_loss", "ngp_loss"]

from .lpips import LPIPS, load_lpips  # noqa: E402

__all__ += ["LPIPS", "load_lpips"]
