"""gnn_rul_tpu — TPU-native GNN benchmarking framework for RUL prediction.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
GNN_RUL_Benchmarking suite: 21 GNN architectures over 4 RUL datasets
(C-MAPSS, N-CMAPSS, PHM2012, XJTU-SY), with a jit-compiled training engine,
device-resident data pipeline, pjit/mesh data parallelism, and Pallas TPU
kernels for the dense graph primitives.
"""

__version__ = "0.1.0"
