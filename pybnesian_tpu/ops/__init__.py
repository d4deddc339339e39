"""Device (JAX/XLA/Pallas) kernels: the numeric core of the framework.

This package replaces the reference's OpenCL backend
(pybnesian/opencl/ + pybnesian/kde/opencl_kernels/, see SURVEY.md §2.2) with
jitted, vmapped, shardable JAX functions. Host layers (factors, scores,
search) call into here; nothing in here touches host-side model objects.
"""
