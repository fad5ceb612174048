"""malstrom_spark — a PySpark-native engine with the capability
surface of MalstromDevelopers/malstrom (stateful stream processing)
plus the relational + LLM-data-pipeline operators needed at 100 TB.

Blueprint: /root/repo/SURVEY.md. Reference citations in docstrings
point into /root/reference/ (read-only snapshot).
"""

from .session import build_session, get_spark
from .stream import Stream

__all__ = ["Stream", "build_session", "get_spark"]
__version__ = "0.1.0"
