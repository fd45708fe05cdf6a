"""Solvers ("model families"): TV-MM, TV-PAM, TV-PD deconvolution + the
deblur pipeline and checkpointing."""

from ics_tpu.models.rl_mm import RLConfig, RLResult, richardson_lucy_MM
from ics_tpu.models.rl_pam import PAMConfig, richardson_lucy_PAM
from ics_tpu.models.rl_pd import PDConfig, richardson_lucy_PD
from ics_tpu.models.pipeline import build_pyramid, deblur_module, pad_image
from ics_tpu.models.tv_denoise import tv_denoise
from ics_tpu.models.checkpoint import (
    SolverCheckpoint,
    load_checkpoint,
    save_checkpoint,
)

__all__ = [
    "RLConfig",
    "RLResult",
    "richardson_lucy_MM",
    "PAMConfig",
    "richardson_lucy_PAM",
    "PDConfig",
    "richardson_lucy_PD",
    "build_pyramid",
    "deblur_module",
    "pad_image",
    "tv_denoise",
    "SolverCheckpoint",
    "load_checkpoint",
    "save_checkpoint",
]
