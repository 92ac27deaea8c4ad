"""Host-side video I/O and device feeding."""

from video_stabilization_tpu.io.video import (  # noqa: F401
    CameraSource,
    FileSource,
    FrameSource,
    SimulatorSource,
    VideoWriter,
    open_source,
)
