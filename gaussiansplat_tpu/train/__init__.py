from .loss import l1, photometric_loss, psnr, ssim
from .trainer import (
    TrainState,
    Trainer,
    init_train_state,
    make_densify_fn,
    make_opacity_reset_fn,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "TrainState",
    "Trainer",
    "init_train_state",
    "l1",
    "make_densify_fn",
    "make_opacity_reset_fn",
    "make_optimizer",
    "make_train_step",
    "photometric_loss",
    "psnr",
    "ssim",
]
