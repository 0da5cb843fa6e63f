"""Native (C++) host-side components, loaded via ctypes.

The TPU compute path is JAX/Pallas; the host-side data path around it is
native where the reference's is: mesh closest-point queries (reference:
Warp BVH on GPU, `data_mesh.py:600`) run here as an OpenMP-parallel C++
AABB tree (`csrc/mesh_sdf.cpp`) because in the TPU design they happen at
scene-compile time on the host. Falls back to the pure-numpy
implementation when no compiler is available.
"""

from curobo_tpu.native.build import get_lib, native_available
from curobo_tpu.native.mesh import mesh_sdf, mesh_udf

__all__ = ["get_lib", "native_available", "mesh_sdf", "mesh_udf"]
