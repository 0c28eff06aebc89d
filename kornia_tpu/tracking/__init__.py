from .planar_tracker import HomographyTracker
from .bytetrack import BoxTracker, ByteTracker, TrackState
