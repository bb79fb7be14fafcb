"""Visualization: skeleton/heatmap drawing + infant clinical figures."""

from .clinical import (
    create_clinical_report_figure,
    create_video_with_pose,
    plot_movement_trajectory,
)
from .skeleton import (
    create_grid_image,
    draw_bbox,
    draw_heatmaps,
    draw_skeleton,
    keypoint_color,
)

__all__ = [
    "create_clinical_report_figure",
    "create_grid_image",
    "create_video_with_pose",
    "draw_bbox",
    "draw_heatmaps",
    "draw_skeleton",
    "keypoint_color",
    "plot_movement_trajectory",
]
