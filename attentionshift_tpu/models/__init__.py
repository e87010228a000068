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

from .condinst import SimpleCondInstHead
from .deformable_attention import DeformableConvAttention
from .detector import AttnShiftDetector, TestOutputs
from .fpn import FPN
from .heads import BoxHeadRec, MILHead, MaskHeadPointSup, mask_point_loss, reconstruction_loss
from .mae_encoder import MAEVisionTransformer, get_sinusoid_encoding_table
from .mae_head import MAEDecoderHead
from .memory_bank import MemoryBank, align_loss, bank_append, init_bank, retrieve_similar
from .point_generator import SupervisionPointGenerator, convex_hull_mask
from .reppoints import RepPointsPartHead, contour_points, refine_fg_maps
from .rpn import RPNHead, rpn_loss, rpn_proposals
from .ssl import DINOHead, IBOTHead, MIMViT
from .swin import SwinTransformer

__all__ += [
    "SimpleCondInstHead",
    "DeformableConvAttention", "AttnShiftDetector", "TestOutputs", "FPN",
    "BoxHeadRec", "MILHead", "MaskHeadPointSup", "mask_point_loss", "reconstruction_loss",
    "MAEVisionTransformer", "get_sinusoid_encoding_table",
    "MAEDecoderHead", "MemoryBank", "align_loss", "bank_append", "init_bank", "retrieve_similar",
    "SupervisionPointGenerator", "convex_hull_mask",
    "RepPointsPartHead", "contour_points", "refine_fg_maps", "RPNHead", "rpn_loss", "rpn_proposals",
    "DINOHead", "IBOTHead", "MIMViT",
    "SwinTransformer",
]
