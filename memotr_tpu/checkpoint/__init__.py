from .orbax_io import save_checkpoint, load_checkpoint
from .torch_convert import convert_torch_state_dict
