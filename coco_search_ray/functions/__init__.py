"""Pure, deterministic kernels shared by the Ray pipeline and the oracle."""
