"""Build hooks for the native host-pipeline library.

The TPU compute path is pure JAX/XLA/Pallas (nothing to compile); the one
native component is csrc/textproc.cpp — the C++ corpus tokenizer/encoder
(SURVEY.md §2: the reference is pure Python; this framework adds a native
host pipeline). It is loaded via ctypes, NOT imported, so it is built as a
plain shared library through setuptools' C++ toolchain; the missing
PyInit_* symbol is irrelevant and the build is OPTIONAL — every caller
falls back to the pure-Python pipeline (data/native.py) when absent.
"""
from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Never fail the install over the optional native fast path."""

    def run(self):
        try:
            super().run()
        except Exception as e:  # noqa: BLE001
            print(f"WARNING: native textproc build skipped ({e}); "
                  "the pure-Python host pipeline will be used")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # noqa: BLE001
            print(f"WARNING: building {ext.name} failed ({e}); "
                  "the pure-Python host pipeline will be used")


setup(
    ext_modules=[
        Extension(
            "vae_lagging_encoder_tpu.data._textproc",
            sources=["csrc/textproc.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
