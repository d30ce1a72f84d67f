"""Native host runtime: scan-log IO, prefetching, channels, async writers.

The compute path is JAX/XLA on TPU; this package is the C++ fabric around it
— the TPU-native replacement for the reference's ROS transport, spinner
threads, and mutex-guarded queues (SURVEY.md §2 P1-P6).
"""

from . import native  # noqa: F401
from .scanlog import ScanLog, ScanLogWriter, Prefetcher  # noqa: F401
from .channel import Channel  # noqa: F401
from .traj import TrajectoryWriter  # noqa: F401
from .stream import StreamingRunner  # noqa: F401
