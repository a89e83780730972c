from .morton import (
    interleave3,
    deinterleave3,
    morton_key,
    zorder_argsort,
    is_ancestor,
)
from .reader import EtreeReader
from .writer import EtreeWriter
