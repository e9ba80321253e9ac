"""Native (C++) runtime bindings: TCP message bus, metrics logger,
rendezvous fault injector (native/libcslam_native.so via ctypes)."""
