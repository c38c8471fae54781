from .analytics import stream_waveform, waveform_stream
from .sip import reopen_pids, sip_build
from .stateful import latest_per_entity_stream, stream_latest_per_entity
from .stumptown import (
    newest_k_stream,
    read_newest_pages,
    stream_stumptown,
)

__all__ = [
    "sip_build",
    "reopen_pids",
    "stream_waveform",
    "waveform_stream",
    "latest_per_entity_stream",
    "stream_latest_per_entity",
    "newest_k_stream",
    "read_newest_pages",
    "stream_stumptown",
]
