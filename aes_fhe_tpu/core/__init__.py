"""Exact u32 RNS arithmetic and negacyclic NTTs, shaped for the TPU."""
