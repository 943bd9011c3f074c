"""Utilities: native-library bindings, profiling helpers."""

from .native import NativeHost, native_available

__all__ = ["NativeHost", "native_available"]
