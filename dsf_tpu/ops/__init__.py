from dsf_tpu.ops.rasterize import (  # noqa: F401
    project_verts,
    rasterize_depth,
    crop_pixel_rays,
    full_frame_pixel_rays,
)
