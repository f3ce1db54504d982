from .timer import PhaseTimer, Timer  # noqa: F401
