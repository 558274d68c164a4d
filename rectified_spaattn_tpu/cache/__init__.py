from .teacache import TeaCache, TeaCacheState, COEFFICIENTS, rel_l1_signal

__all__ = ["TeaCache", "TeaCacheState", "COEFFICIENTS", "rel_l1_signal"]
