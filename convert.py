"""EXL2 conversion CLI (reference convert.py / convert_exl2.py analog).

Usage:
    python convert.py -i <fp16_model_dir> -o <out_dir> -b 4.0 [-hb 8]
                      [-c calibration.txt] [-r rows] [-l row_len]
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description="Convert a model to EXL2")
    ap.add_argument("-i", "--in_dir", required=True)
    ap.add_argument("-o", "--out_dir", required=True)
    ap.add_argument("-b", "--bits", type=float, default=4.0,
                    help="target average bits per weight")
    ap.add_argument("-hb", "--head_bits", type=int, default=8)
    ap.add_argument("-c", "--cal_dataset", default=None,
                    help="calibration data: .txt or .parquet file "
                         "(reference -c semantics)")
    ap.add_argument("-r", "--rows", type=int, default=16)
    ap.add_argument("-l", "--length", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-ss", "--output_shard_size", type=float, default=8192,
                    help="split output above this many MB into numbered "
                         "safetensors shards + index (reference -ss; "
                         "0 = single file)")
    ap.add_argument("--status_output", action="store_true",
                    help="emit [STATUS]{...}[/STATUS] machine-parseable "
                         "stage lines (reference bot_status protocol)")
    ap.add_argument("-gs", "--group_size", type=int, default=32,
                    help="scale-group rows for every candidate option "
                         "(default 32 = the reference grid; 128 emits "
                         "W4A8-friendly checkpoints for the int8-MXU "
                         "decode mode, docs/DESIGN.md round-5)")
    args = ap.parse_args()

    # pipeline handles .txt / .parquet paths directly
    text = args.cal_dataset

    from exllamav2_tpu.convert.pipeline import convert_model
    convert_model(args.in_dir, args.out_dir, bits=args.bits,
                  head_bits=args.head_bits, cal_rows=args.rows,
                  cal_len=args.length, cal_text=text, seed=args.seed,
                  shard_size_mb=args.output_shard_size,
                  status_output=args.status_output,
                  group_size=args.group_size)


if __name__ == "__main__":
    main()
