from .simulator import generate_runs, generate_traces

__all__ = ["generate_runs", "generate_traces"]
