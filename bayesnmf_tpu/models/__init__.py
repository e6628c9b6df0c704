from . import convergence, gibbs, map_estimate, updates  # noqa: F401
