from .topology import SparseLevel, UNetTopology, build_unet_topology, kernel_offsets
from .ops import sparse_conv, sparse_conv_transpose, gather_rows
from .unet import MinkUNet, DisNet, UNET_ARCHS, build_student
