from .datasets import (  # noqa: F401
    video_data_paths_dict,
    default_T_dict,
    default_image_size_dict,
    default_iterations_dict,
    load_video_data,
    load_data,
    get_test_dataset,
    get_train_dataset,
    get_variable_length_dataset,
)
