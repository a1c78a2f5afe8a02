"""Single-process reference-semantics oracle for parity testing."""
