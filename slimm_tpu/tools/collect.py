"""Multi-sample profile merge (reference collect_profiles.py, Python-3 port).

Faithful behavior notes (collect_profiles.py:17-61): rows are keyed by the
LINEAGE column; the "name" output column actually carries the abundance
value of the last file that mentioned the taxon (values[3]); the per-sample
columns carry the READ COUNT (values[4]); sort is descending by level, then
lineage, then the sample columns.
"""

from __future__ import annotations

import pandas as pd


def collect_profiles(profile_paths: list[str],
                     output_path: str = "merged_profile.tsv") -> str:
    samples = []
    for file_path in profile_paths:
        f_name_start = file_path.rfind("/")
        dot_pos = file_path.rfind(".")
        samples.append(file_path[f_name_start + 1:dot_pos])
    column_names = ["level", "taxid", "name", "linage"] + samples

    all_taxids: dict[str, list] = {}
    for file_path in profile_paths:
        with open(file_path) as f:
            next(f)
            for line in f:
                values = line.rstrip("\n").split("\t")
                all_taxids[values[2]] = [values[0], values[1], values[3],
                                         values[2]]

    for key in all_taxids:
        all_taxids[key] = all_taxids[key] + len(samples) * ["0.0"]

    for sample_no, file_path in enumerate(profile_paths):
        with open(file_path) as f:
            next(f)
            for line in f:
                values = line.rstrip("\n").split("\t")
                all_taxids[values[2]][4 + sample_no] = values[4]

    merged = pd.DataFrame.from_dict(all_taxids, orient="index")
    merged.columns = column_names
    sort_columns = ["level"] + column_names[3:]
    merged.sort_values(sort_columns, ascending=len(sort_columns) * [False],
                       inplace=True)
    merged.to_csv(path_or_buf=output_path, sep="\t", index=False)
    return output_path
