from . import dims, synth  # noqa: F401
