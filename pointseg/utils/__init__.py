from pointseg.utils.benchmark import benchmark_fn, benchmark_points_per_sec  # noqa: F401
from pointseg.utils.memory import get_memory_usage, format_memory_usage  # noqa: F401
from pointseg.utils.sliding_window import predict_single_scene  # noqa: F401
