"""Algorithm layer: estimation, rectification, pointing, triangulation, fusion."""
