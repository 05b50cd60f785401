from .metrics import Evaluator, psnr, ssim

__all__ = ["Evaluator", "psnr", "ssim"]
