from .raft import RAFT, RAFTBase, raft_small, inference, convex_upsample  # noqa: F401
from .criterion import raft_sequence_loss  # noqa: F401
from .utils import Padder  # noqa: F401
from .extractor import BasicEncoder, SmallEncoder  # noqa: F401
