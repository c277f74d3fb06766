"""Declared query giving the streaming stack a driver-visible surface.

Implemented later this round: a Trigger.AvailableNow file-source replay
through foreachBatch merge into a transactional lake, with the final
state oracle-checked against DuckDB.
"""

from __future__ import annotations
