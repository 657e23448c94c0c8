"""Build the native audio extension:

    cd native && python setup.py build_ext --inplace \
        --build-lib ../vq_voice_swap_tpu/data

or use vq_voice_swap_tpu.data.native.build_native().
"""

from setuptools import Extension, setup

setup(
    name="audio_native",
    ext_modules=[
        Extension(
            "_audio_native",
            sources=["audio_native.c"],
            extra_compile_args=["-O3"],
        )
    ],
)
