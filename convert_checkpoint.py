"""Convert a released PyTorch vq-voice-swap checkpoint (.pt) into this
framework's .npz format, so it can be sampled/evaluated/fine-tuned on TPU.

Usage: python convert_checkpoint.py model.pt model.npz
"""

import argparse

from vq_voice_swap_tpu.convert import convert_torch_checkpoint


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("torch_path", type=str)
    parser.add_argument("out_path", type=str)
    args = parser.parse_args()
    class_name, kwargs = convert_torch_checkpoint(args.torch_path, args.out_path)
    print(f"converted {class_name} checkpoint -> {args.out_path}")
    print(f"kwargs: {kwargs}")


if __name__ == "__main__":
    main()
