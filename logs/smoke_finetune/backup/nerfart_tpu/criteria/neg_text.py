"""Negative prompt bank parsing (reference Trainer.create_fine_neg_texts,
volsdf.py:649-681 / neus.py:458-490).

Format: `#category` headers, then `N.prompt` lines. Categories matching the
stylization target text are removed from the negative pool so the model is
not pushed away from the style it is being pulled toward.
"""
import os
from typing import Dict, List

DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "neg_text.txt")


def parse_neg_text(path: str = DEFAULT_PATH) -> Dict[str, List[str]]:
    results: Dict[str, List[str]] = {}
    curr_key = "0"
    with open(path, "r") as fr:
        for item in fr.readlines():
            item = item.strip()
            if not item:
                continue
            if item.startswith("#"):
                curr_key = item[1:]
                results[curr_key] = []
            else:
                results[curr_key].append(item.split(".")[1])
    return results


def create_fine_neg_texts(target_text: str,
                          path: str = DEFAULT_PATH) -> List[str]:
    """All negatives except the category matching the target style
    (volsdf.py:663-681)."""
    results = parse_neg_text(path)
    remove_ids: List[str] = []
    ttext = target_text.lower()
    if ('botero' in ttext or 'monalisa' in ttext or 'portrait' in ttext
            or 'painting' in ttext):
        remove_ids = ['portrait']
    elif 'zombie' in ttext:
        remove_ids = ['zombie']
    elif 'wolf' in ttext:
        remove_ids = ['wolf']
    elif 'pixlar' in ttext or 'disney' in ttext:
        remove_ids = ['disney']
    elif 'sketch' in ttext:
        remove_ids = ['sketch']

    all_texts: List[str] = []
    for key in results:
        if key not in remove_ids:
            all_texts += results[key]
    return all_texts
