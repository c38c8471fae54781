from .sip import reopen_pids, sip_build

__all__ = ["sip_build", "reopen_pids"]
