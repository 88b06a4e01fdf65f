"""Native runtime tier: C++ hot paths with ctypes bindings + fallbacks."""
