from .schedules import get_named_beta_schedule, space_timesteps  # noqa: F401
from .diffusion import (  # noqa: F401
    GaussianDiffusion,
    ModelMeanType,
    ModelVarType,
    LossType,
    create_diffusion,
)
