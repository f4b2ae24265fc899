"""HypAD-TPU: a TPU-native (JAX/XLA/Pallas) framework for unsupervised
time-series anomaly detection with hyperbolic uncertainty, providing the full
capability surface of the reference HypAD (aleflabo/HypAD, CVPRW 2023)."""

__version__ = "0.1.0"
