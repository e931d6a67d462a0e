from vidu4d_tpu.ops.rasterize.api import (
    RasterizeConfig,
    RenderOutput,
    rasterize,
    rasterize_naive,
)
from vidu4d_tpu.ops.rasterize.common import project_splats, SplatProjection
