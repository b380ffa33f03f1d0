"""Pipeline layer (L0-L4): contracts, agents, runner, storage, tracing."""
