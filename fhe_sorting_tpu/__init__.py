"""tpu-fhe-sort: a TPU-native RNS-CKKS homomorphic sorting framework.

Built from scratch in JAX/Pallas with the capabilities of the reference
C++/OpenFHE project oksuman/FHE-Sorting (see SURVEY.md).  Unlike the
reference, which outsources the CKKS runtime to OpenFHE, this package
implements the full crypto runtime itself as JAX programs over uint32 limb
planes (negacyclic NTT, rescale, hybrid key switching, slot rotations with
hoisting, Chebyshev Paterson-Stockmeyer evaluation), plus the four encrypted
sorting algorithm families on top of it.

Layout (mirrors SURVEY.md section 7):
  core/      RNS-CKKS runtime (the layer OpenFHE provides to the reference)
  ops/       sign / comparison / polynomial-eval / rotation-composer layer
  models/    sorting algorithms: direct rank sort, bitonic, k-way, MEHP24
  parallel/  multi-chip sharding (mesh, shard_map'd batch/limb axes)
  utils/     Chebyshev coefficient codegen, parameter registry helpers
"""

__version__ = "0.1.0"
