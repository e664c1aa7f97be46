"""HTTP serving layer."""

from go_pocket_tts_tpu.server.http import Server, make_handler, probe_http

__all__ = ["Server", "make_handler", "probe_http"]
