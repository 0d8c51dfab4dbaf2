"""SpeechCommands V2 dataset preparation.

Equivalent of /root/reference/exps/speechcommands/prep_sc.py:17-117:
downloads and extracts speech_commands_v0.02, builds the official
train/valid/test splits from validation_list.txt / testing_list.txt, and
writes {train,valid,eval} JSON datafiles plus the 35-class label CSV.

This environment has no network egress; pass --archive to use a
pre-downloaded speech_commands_v0.02.tar.gz, or --extracted for an already
extracted directory.
"""

import argparse
import json
import os
import sys
import tarfile
import urllib.request

URL = ("http://download.tensorflow.org/data/speech_commands_v0.02.tar.gz")

WORDS = ["backward", "bed", "bird", "cat", "dog", "down", "eight", "five",
         "follow", "forward", "four", "go", "happy", "house", "learn",
         "left", "marvin", "nine", "no", "off", "on", "one", "right",
         "seven", "sheila", "six", "stop", "three", "tree", "two", "up",
         "visual", "wow", "yes", "zero"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./data/speechcommands")
    p.add_argument("--archive", help="local speech_commands_v0.02.tar.gz")
    p.add_argument("--extracted", help="already-extracted dataset dir")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    root = args.extracted
    if root is None:
        archive = args.archive
        if archive is None:
            archive = os.path.join(args.out, "speech_commands_v0.02.tar.gz")
            if not os.path.exists(archive):
                print(f"downloading {URL} ...")
                try:
                    urllib.request.urlretrieve(URL, archive)
                except Exception as e:
                    sys.exit(f"download failed ({e}); this environment may "
                             "have no egress — pass --archive or --extracted")
        root = os.path.join(args.out, "speech_commands_v0.02")
        if not os.path.isdir(root):
            with tarfile.open(archive) as tf:
                tf.extractall(root)

    def read_list(name):
        with open(os.path.join(root, name)) as f:
            return set(l.strip() for l in f if l.strip())

    valid = read_list("validation_list.txt")
    test = read_list("testing_list.txt")

    splits = {"train": [], "valid": [], "eval": []}
    for word in WORDS:
        d = os.path.join(root, word)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".wav"):
                continue
            rel = f"{word}/{fn}"
            split = ("valid" if rel in valid
                     else "eval" if rel in test else "train")
            splits[split].append(
                {"wav": os.path.join(root, rel), "labels": f"/m/spcmd{WORDS.index(word):02d}"})

    dfdir = os.path.join(args.out, "datafiles")
    os.makedirs(dfdir, exist_ok=True)
    for split, data in splits.items():
        path = os.path.join(dfdir, f"speechcommand_{split}_data.json")
        with open(path, "w") as f:
            json.dump({"data": data}, f)
        print(f"{split}: {len(data)} clips -> {path}")

    csv = os.path.join(args.out, "speechcommands_class_labels_indices.csv")
    with open(csv, "w") as f:
        f.write("index,mid,display_name\n")
        for i, w in enumerate(WORDS):
            f.write(f'{i},/m/spcmd{i:02d},"{w}"\n')
    print(f"labels -> {csv}")


if __name__ == "__main__":
    main()
