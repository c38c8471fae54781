from .analytics import stream_waveform, waveform_stream
from .sip import reopen_pids, sip_build

__all__ = ["sip_build", "reopen_pids", "stream_waveform", "waveform_stream"]
