from swtpu.utils.metrics import BatchEvent, EventLog, GcupsMeter, profile_trace

__all__ = ["BatchEvent", "EventLog", "GcupsMeter", "profile_trace"]
