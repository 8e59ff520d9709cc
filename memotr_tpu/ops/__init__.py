from .msda import ms_deform_attn, ms_deform_attn_xla
from .hungarian import hungarian, hungarian_cost_padded
