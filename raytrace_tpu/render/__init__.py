"""Render engine: the wavefront integrator and film accumulation."""
