from . import tracer, bruteforce
