from .timers import TimerRegistry, timers

__all__ = ["TimerRegistry", "timers"]
