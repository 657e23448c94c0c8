"""Train a (class-conditional) diffusion model on waveforms.

Entry point over vq_voice_swap_tpu.train.DiffusionTrainLoop: one jitted TPU
step per batch (grad accumulation, AdamW, multi-rate EMA), checkpoint
discovery/resume, data-parallel over all local chips.

Examples:
    python train_diffusion.py tones
    python train_diffusion.py --class-cond --base-channels 64 \
        --batch-size 32 --bf16 /data/LibriSpeech/train-clean-360
"""

import vq_voice_swap_tpu.train as train


def main():
    loop = train.DiffusionTrainLoop()
    loop.loop()


if __name__ == "__main__":
    main()
