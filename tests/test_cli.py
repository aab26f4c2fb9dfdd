"""CLI behavior parity: flags, error paths, outmodes, verbose replay.

Reference behaviors: bialign.py:99-128 (Input echo, --outmode help),
bialignment.pyx:726-743 (bad-outmode warning + sorted fallback, prefix
autocomplete), pyx:207-210 (length-mismatch exit), nonpyx:84-95 (file
errors).
"""

import pytest

import golden as G
from bialign_tpu.cli import main


def test_outmode_help_exits(capsys):
    with pytest.raises(SystemExit):
        main(["A", "A", "--outmode", "help", "--type", "RNA",
              "--strA", ".", "--strB", "."])
    out = capsys.readouterr().out
    assert "Available modes: " in out
    for mode in ("default", "sorted", "sorted_sym", "sorted_terse",
                 "raw", "raw_struct", "full"):
        assert mode in out


def test_bad_outmode_warns_and_falls_back_to_sorted(capsys):
    main([
        G.TOY_RNA["seqA"], G.TOY_RNA["seqB"],
        "--strA", G.TOY_RNA["strA"], "--strB", G.TOY_RNA["strB"],
        "--outmode", "bogus", "--engine", "numpy",
    ])
    out = capsys.readouterr().out
    assert "WARNING: unknown output mode." in out
    # sorted layout: two 6-row blocks + separators + shift rows
    body = out[out.index("SCORE:"):].splitlines()
    assert body.count("") >= 3


def test_outmode_prefix_autocomplete(capsys):
    main([
        G.TOY_RNA["seqA"], G.TOY_RNA["seqB"],
        "--strA", G.TOY_RNA["strA"], "--strB", G.TOY_RNA["strB"],
        "--outmode", "f", "--engine", "numpy",
        "--gap_opening_cost", "-200", "--gap_cost", "-50",
        "--max_shift", "1", "--shift_cost", "-150",
        "--structure_weight", "400",
    ])
    out = capsys.readouterr().out.splitlines()
    # 'f' -> 'full': 14 rows after the SCORE/blank lines
    idx = out.index("SCORE: 6800")
    assert len(out[idx + 2:]) == 14


def test_structure_length_mismatch_exits(capsys):
    with pytest.raises(SystemExit) as e:
        main(["ACGU", "ACGU", "--strA", "...", "--strB", "....",
              "--engine", "numpy"])
    assert e.value.code == -1
    assert "same length" in capsys.readouterr().out


def test_protein_without_structure_exits(capsys):
    with pytest.raises(SystemExit) as e:
        main(["ACD", "ACD", "--type", "Protein", "--engine", "numpy"])
    assert e.value.code == -1
    assert "Structures have to be provided" in capsys.readouterr().out


def test_fileinput_missing_file_exits(capsys):
    with pytest.raises(SystemExit) as e:
        main(["/nonexistent/a.cfssp", "/nonexistent/b.cfssp",
              "--fileinput", "--type", "Protein"])
    assert e.value.code == -1
    assert "Input file not found." in capsys.readouterr().out


def test_fileinput_cfssp(tmp_path, capsys):
    def cfssp(seq, struc):
        lines = []
        for i in range(0, len(seq), 10):
            lines.append(f"Query 1 {seq[i:i+10]} {min(i+10, len(seq))}")
            lines.append(f"Struc 1 {struc[i:i+10]} {min(i+10, len(seq))}")
        return "\n".join(lines)

    fa = tmp_path / "a.cfssp"
    fb = tmp_path / "b.cfssp"
    fa.write_text(cfssp(G.TOY_PROTEIN["seqA"], G.TOY_PROTEIN["strA"]))
    fb.write_text(cfssp(G.TOY_PROTEIN["seqB"], G.TOY_PROTEIN["strB"]))
    main([
        str(fa), str(fb), "--filein",  # argparse prefix of --fileinput
        "--type", "Protein", "--shift_cost", "-150",
        "--structure", "800", "--simmatrix", "BLOSUM62",
        "--gap_opening_cost", "-150", "--gap_cost", "-50",
        "--max_shift", "1", "--outmode", "sorted", "--engine", "numpy",
    ])
    out = capsys.readouterr().out.splitlines()
    assert "SCORE: 48500" in out
    idx = out.index("SCORE: 48500")
    assert out[idx + 2:] == G.TOY_PROTEIN_SORTED_OUT


def test_verbose_replays_trace(capsys):
    main([
        G.TOY_RNA["seqA"], G.TOY_RNA["seqB"],
        "--strA", G.TOY_RNA["strA"], "--strB", G.TOY_RNA["strB"],
        "-v", "--engine", "numpy",
        "--gap_opening_cost", "-200", "--gap_cost", "-50",
        "--max_shift", "1", "--shift_cost", "-150",
        "--structure_weight", "400",
    ])
    out = capsys.readouterr().out.splitlines()
    replay = [x for x in out if "-->" in x]
    assert len(replay) > 0
    # the final running total equals the optimal score (eval identity)
    assert replay[-1].endswith("6800")


def test_verbose_nonaffine(capsys):
    main([
        G.TOY_RNA["seqA"], G.TOY_RNA["seqB"],
        "--strA", G.TOY_RNA["strA"], "--strB", G.TOY_RNA["strB"],
        "-v", "--engine", "numpy",
    ])
    out = capsys.readouterr().out.splitlines()
    replay = [x for x in out if "-->" in x]
    assert len(replay) > 0
    assert replay[-1].endswith(str(G.TOY_RNA_NONAFFINE_SCORE))


def test_nodescription(capsys):
    main([
        G.TOY_RNA["seqA"], G.TOY_RNA["seqB"],
        "--strA", G.TOY_RNA["strA"], "--strB", G.TOY_RNA["strB"],
        "--nodescription", "--engine", "numpy",
        "--gap_opening_cost", "-200", "--gap_cost", "-50",
        "--max_shift", "1", "--shift_cost", "-150",
        "--structure_weight", "400",
    ])
    out = capsys.readouterr().out.splitlines()
    idx = out.index("SCORE: 6800")
    stripped = [line[16:] for line in G.TOY_RNA_AFFINE_DEFAULT_OUT]
    assert out[idx + 2:] == stripped


def test_version(capsys):
    with pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert "BiAlign 0.3" in capsys.readouterr().out


def test_custom_names(capsys):
    main([
        G.TOY_RNA["seqA"], G.TOY_RNA["seqB"],
        "--strA", G.TOY_RNA["strA"], "--strB", G.TOY_RNA["strB"],
        "--nameA", "Ecoli", "--nameB", "Xantho", "--engine", "numpy",
        "--gap_opening_cost", "-200", "--gap_cost", "-50",
        "--max_shift", "1", "--shift_cost", "-150",
        "--structure_weight", "400",
    ])
    out = capsys.readouterr().out
    assert "Ecoli " in out
    assert "Xantho ss" in out


def test_batch_cli_scores_and_alignments(tmp_path, capsys):
    """Corpus batch runner: TSV in, JSONL out, spool resume works."""
    import json as _json

    from bialign_tpu.parallel.batch_cli import main as batch_main

    seqA = "RAKLPLKEKKLTATANYHPGIRYIMTGYSAKYIYSSTYARFR"
    seqB = "KAKLPLKEKKLTRTANYHPGIRYIMTGYSAKRIYSSTYAYFR"
    strA = "CHHHHHHHHHHHHHCCCCTCEEEEEEECCTCEEEEEEEECCC"
    strB = "HHHHHHHHHHHHCCCCCCTCEEEEEEECCCCCEEEEEEEECC"
    tsv = tmp_path / "pairs.tsv"
    tsv.write_text(
        "\n".join(f"p{i}\t{seqA}\t{seqB}\t{strA}\t{strB}"
                  for i in range(3)) + "\n"
    )
    spool = tmp_path / "out.jsonl"
    args = [str(tsv), "--spool", str(spool), "--type", "Protein",
            "--simmatrix", "BLOSUM62", "--structure_weight", "800",
            "--gap_opening_cost", "-150", "--gap_cost", "-50",
            "--shift_cost", "-150", "--max_shift", "1"]
    assert batch_main(args) == 0
    out = capsys.readouterr().out
    recs = [_json.loads(ln) for ln in out.splitlines() if ln]
    assert [r["score"] for r in recs] == [48500] * 3

    # resume: all ids spooled -> second run emits nothing new
    assert batch_main(args) == 0
    assert capsys.readouterr().out.strip() == ""

    # alignments mode emits trace codes
    spool2 = tmp_path / "aln.jsonl"
    args2 = [a if a != str(spool) else str(spool2) for a in args]
    assert batch_main(args2 + ["--alignments"]) == 0
    recs2 = [_json.loads(ln) for ln in
             capsys.readouterr().out.splitlines() if ln]
    assert recs2 and all(r["trace"] for r in recs2)

    # --render decodes each trace to the reference alignment lines
    spool3 = tmp_path / "ren.jsonl"
    args3 = [a if a != str(spool) else str(spool3) for a in args]
    assert batch_main(args3 + ["--alignments", "--render"]) == 0
    out3 = capsys.readouterr().out
    assert "p0.A " in out3 and "p0.B ss" in out3 and "p2.A shifts" in out3
