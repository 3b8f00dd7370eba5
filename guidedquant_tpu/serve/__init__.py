from .engine import DecodeState, init_state, prefill, decode_step, generate  # noqa: F401
