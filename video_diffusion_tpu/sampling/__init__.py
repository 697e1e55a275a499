from .strategies import inference_strategies, InferenceStrategyBase  # noqa: F401
from .sampler import compile_schedule, sample_video, Schedule  # noqa: F401
