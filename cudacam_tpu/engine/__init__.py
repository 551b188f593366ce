from cudacam_tpu.engine.engine import CannyEngine

__all__ = ["CannyEngine"]
