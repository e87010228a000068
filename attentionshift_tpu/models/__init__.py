from .convert import load_torch_state_dict, mae_to_decoder_params, mae_to_vit_params
from .layers import Attention, Block, Mlp, PatchEmbed, get_2d_sincos_pos_embed
from .vit import VisionTransformerDet

__all__ = [
    "load_torch_state_dict",
    "mae_to_decoder_params",
    "mae_to_vit_params",
    "Attention",
    "Block",
    "Mlp",
    "PatchEmbed",
    "get_2d_sincos_pos_embed",
    "VisionTransformerDet",
]
