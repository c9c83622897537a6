"""Host utilities: native library bindings, logging helpers."""
