"""Miniapp benchmark drivers.

Equivalent of the reference's ``miniapp/`` tree (15 executables,
``miniapp/CMakeLists.txt``): each module is runnable as
``python -m dlaf_tpu.miniapp.<name> [flags]`` and follows the reference
protocol (``miniapp_cholesky.cpp:106-199``): build grid -> generate input ->
warmups + timed runs -> GFlop/s from the reference flop models -> optional
``CSVData-2`` row -> optional numerical check.
"""
