from .precise import contract, ozaki_contract, outer_accumulate_contract

__all__ = ["contract", "ozaki_contract", "outer_accumulate_contract"]
