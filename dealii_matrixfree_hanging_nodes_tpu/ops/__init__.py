from .sum_factorization import evaluate_gradients, integrate_gradients  # noqa: F401
from .hanging_nodes import apply_hanging_node_constraints  # noqa: F401
