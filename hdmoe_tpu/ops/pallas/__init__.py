# Pallas TPU kernels for the hot ops (flash attention, MoE dispatch/combine).
