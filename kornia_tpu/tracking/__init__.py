from .planar_tracker import HomographyTracker
