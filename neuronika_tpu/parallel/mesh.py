"""placeholder - populated in the parallel milestone"""
__all__ = []
