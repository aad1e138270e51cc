from attngan_tpu.utils.imaging import (
    image_grid,
    moving_average,
    plot_history,
    save_attention_maps,
    save_image,
    save_image_grids,
)
from attngan_tpu.utils.timing import StepTimer, block, profile_trace, timer

__all__ = [
    "StepTimer", "block", "image_grid", "moving_average", "plot_history",
    "profile_trace", "save_attention_maps", "save_image", "save_image_grids",
    "timer",
]
