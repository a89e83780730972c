"""hercules_tpu — a TPU-native rebuild of the CMU-Quake/hercules
parallel earthquake ground-motion simulator.

The reference (C + MPI, /root/reference) meshes a 3-D earth volume with an
unstructured octree of hexahedral elements, assigns material properties from
an on-disk etree ("CVM") database, inserts a kinematic earthquake source as
equivalent nodal forces, and marches the elastic / anelastic wave equation
forward with an explicit central-difference integrator.

This package re-designs that pipeline TPU-first:

- meshing is a host-side vectorized pass (``hercules_tpu.mesh``) producing
  flat SoA element/node arrays;
- the per-timestep physics is a single jitted step built from batched
  matmuls against constant 24x24 spectral stiffness operators plus
  segment-sum scatter (``hercules_tpu.solver``), shardable over a
  ``jax.sharding.Mesh`` with ICI collectives replacing MPI halo exchange;
- the etree database format is read/written natively
  (``hercules_tpu.etree``), so reference CVM databases and golden outputs
  can be consumed unmodified.
"""

__version__ = "0.1.0"
