from .masks import MaskSampler, make_interesting_masks  # noqa: F401
from .resample import (  # noqa: F401
    UniformSampler,
    LossSecondMomentResampler,
    create_named_schedule_sampler,
)
