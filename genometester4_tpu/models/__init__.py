"""FastGT statistical models.

``fastgt_native``: host-exact C kernels (bit-for-bit gmer_caller parity
— glibc rand stream, float/double mixed precision, libm transcendentals).
``genotype``: jnp implementation of the same 15-genotype posterior for
TPU-scale batch genotyping.
"""
