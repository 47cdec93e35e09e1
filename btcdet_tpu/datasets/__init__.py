from .synthetic import make_synthetic_batch  # noqa: F401
