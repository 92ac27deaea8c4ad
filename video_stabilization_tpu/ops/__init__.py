"""Vision/image kernels for the TPU stabilization pipeline.

All ops are pure jnp/XLA (with Pallas variants for the hot paths in
``ops.pallas``), operate on float32 image arrays with static shapes, and are
written to match OpenCV's sampling conventions closely enough that fidelity
tests can compare against ``cv2`` outputs directly (tests/test_ops.py).
"""

from video_stabilization_tpu.ops.image import (  # noqa: F401
    bgr_to_gray,
    resize_bilinear,
    resize_nearest,
)
from video_stabilization_tpu.ops.warp import warp_perspective  # noqa: F401
from video_stabilization_tpu.ops.pyramid import (  # noqa: F401
    build_pyramid,
    pyr_down,
)
