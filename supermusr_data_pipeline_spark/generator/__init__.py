from .schedule import run_schedule, schedule_to_envelope
from .simulator import generate_runs, generate_traces

__all__ = ["generate_runs", "generate_traces", "run_schedule", "schedule_to_envelope"]
