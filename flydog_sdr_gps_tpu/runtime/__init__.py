"""Host-side streaming runtime: sources, block engine, native codecs."""

from .source import (FileSource, Int24FileSource, SampleSource,
                     SyntheticSource, DeviceSceneSource, ThreadedSource)
from .stream import StreamEngine
from .sharded_stream import ShardedStreamEngine
from .gps_service import GpsReceiver
