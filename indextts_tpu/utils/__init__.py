"""Host-side utilities: audio I/O, resampling, logging, profiling."""
