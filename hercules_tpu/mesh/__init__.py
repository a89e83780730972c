from .octree import Octree, domain_ticks
from .extract import MeshArrays, extract_mesh
