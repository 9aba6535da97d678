"""Adaptive context models: executable Python specification.

The native engine (native/rc.h et al.) carries the production
implementations; this package holds the model *definitions* — the
range-coder + adaptive frequency model semantics and the FQZ strategy
parameter presets — as plain Python, used as a golden reference in
tests and as the staging ground for batched device ports.
"""
