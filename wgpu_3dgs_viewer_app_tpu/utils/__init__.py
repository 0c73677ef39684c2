from .format import human_readable_size
from .tasks import exec_task

__all__ = ["human_readable_size", "exec_task"]
