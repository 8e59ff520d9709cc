from .track_state import TrackState
from .padded_frame import PaddedFrames, pad_images_to_frames
