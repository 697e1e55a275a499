from .unet import (  # noqa: F401
    UNet,
    VideoUNet,
    CondMargVideoUNet,
    SuperResUNet,
)
from .factory import (  # noqa: F401
    create_model,
    create_video_model,
    create_model_and_diffusion,
    create_video_model_and_diffusion,
    model_and_diffusion_defaults,
    video_model_and_diffusion_defaults,
)
