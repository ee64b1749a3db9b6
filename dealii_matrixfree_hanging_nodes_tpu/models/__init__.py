from .laplace import LaplaceOperator  # noqa: F401
