"""Graphical alignment rendering (matplotlib, host-side).

Parity targets: ``breaklines`` / ``runs`` / ``fourway_from_full`` /
``plot_alignment`` in reference ``bialignment_nonpyx.py:98-367``.  Drawing
semantics reproduced: per-block rows of the four alignment strings, secondary
structure glyphs per run (H = red zigzag helix, E = green sheet arrow,
T = blue thick line, C = orange line, others grey, gaps blank), bold/colored
residue identity, boxed shift columns, red/blue incongruence bars that count
the running net shift, and optional position numbers.  matplotlib is imported
lazily so the compute path never depends on it.
"""

from __future__ import annotations

from collections import defaultdict


def breaklines(alilines, width: int):
    """Split named alignment rows into blocks of ``width`` columns
    (nonpyx:98-114)."""
    res = []
    offset = 0
    length = len(alilines[0][1])
    while offset < length:
        res.append(
            [(name, line[offset:offset + width]) for name, line in alilines]
        )
        offset += width
    return res


def runs(s: str):
    """Run-length encode: yields (char, start, end) (nonpyx:117-128)."""
    if s == "":
        return
    last_start = 0
    last = s[0]
    for i, x in enumerate(s[1:]):
        if x != last:
            yield (last, last_start, i + 1)
            last_start = i + 1
            last = x
    yield (last, last_start, len(s))


def fourway_from_full(alilines):
    """Default 6-row view of the full 14-row alignment (nonpyx:140-141)."""
    return [alilines[i] for i in [1, 3, 6, 8, 12, 13]]


def plot_alignment(
    alilines,
    width,
    *,
    show_structure_strings=False,
    name_offset=12,
    show_position_numbers=True,
    show_inconcruence=True,
    outname=None,
):
    """Plot a bi-alignment; optionally write to ``outname``
    (reference nonpyx:144-367).

    ``alilines``: named alignment rows; a full 14-row alignment is reduced
    to the default 6-row view first.
    """
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    helix_yadd_a = [0.0075]
    helix_yadd_b = [0.0075]

    if len(alilines) >= 13:
        alilines = fourway_from_full(alilines)

    aliblocks = breaklines(alilines, width)
    numblocks = len(aliblocks)
    fig, axs = plt.subplots(numblocks, 1, figsize=(0.18 * width, 2 * numblocks))
    if numblocks == 1:
        axs = [axs]

    plt.rc("font", family="monospace", weight="normal", size=16.0)

    colors = defaultdict(lambda: "grey", E="green", C="orange", T="blue", H="red")
    colors["-"] = None

    def draw_line(ax, s, e, y, color, lw):
        ax.plot([s, e], [y + 0.025, y + 0.025], linewidth=lw, color=color,
                solid_capstyle="butt")

    def draw_sheet(ax, s, e, y, color):
        if s + 1 < e:
            ax.plot([s, e - 1], [y + 0.025, y + 0.025], linewidth=8,
                    color=color, solid_capstyle="butt")
        ax.plot([e - 0.05], [y + 0.025], linewidth=0, color=color, marker=5,
                markersize=13)

    def draw_helix(ax, s, e, y, color, yadd):
        xs = list(reversed(range(s, e + 1)))
        y += 0.025
        ys = [y + yadd[0]]
        for _ in reversed(range(s, e)):
            yadd[0] = -yadd[0]
            ys.append(y + yadd[0])
        ax.plot(xs, ys, linewidth=6, color=color, solid_capstyle="butt",
                solid_joinstyle="round")

    def draw_str(ax, y, line, yadd):
        _name, struc = line
        for ch, s, e in reversed(list(runs(struc))):
            color = colors[ch]
            if ch == "E":
                draw_sheet(ax, s, e, y, color)
            elif ch == "H":
                draw_helix(ax, s, e, y, color, yadd)
            elif color is None:
                pass
            else:
                draw_line(ax, s, e, y, color, 8 if ch == "T" else 4)

    def draw_seq(ax, y, line, other=None):
        name, seq = line
        ax.text(-name_offset, y, name)
        for x, ch in enumerate(seq):
            weight = "normal"
            color = "black"
            if other is not None:
                if ch != "-" and other[x] != "-":
                    color = "darkred"
                if ch == other[x]:
                    weight = "bold"
                    color = "black"
            ax.text(x, y, ch, weight=weight, color=color)

    def draw_shifts(ax, aa, bb):
        for x, (a, b) in enumerate(zip(aa, bb)):
            if a in ["<", ">"] or b in ["<", ">"]:
                ax.add_patch(Rectangle((x, -0.022), 1, 0.4, edgecolor="black",
                                       fill=False, lw=0.5))

    incongruence_info = [0, 0]

    def draw_incongruence(ax, aa, bb):
        def draw_single(k, s, e, num):
            y = -0.0425 if k == 1 else 0.405
            if num == 0 or s > e:
                return
            color = "darkred" if num > 0 else "darkblue"
            num = abs(num)
            for i in range(num):
                o = (i / (num - 1) - 0.5) * 0.02 if num > 1 else 0
                ax.plot([s, e + 1], [y + o, y + o], linewidth=1, color=color,
                        solid_capstyle="butt")

        starts = [0, 0]
        x = -1
        for x, ab in enumerate(zip(aa, bb)):
            for k, c in enumerate(ab):
                if c in ["<", ">"]:
                    draw_single(k, starts[k], x - 1, incongruence_info[k])
                    starts[k] = x + 1
                    incongruence_info[k] += 1 if c == ">" else -1
        for k in range(2):
            draw_single(k, starts[k], x, incongruence_info[k])

    offset_a = 1
    offset_b = 1
    block = aliblocks[-1]
    for k, block in enumerate(aliblocks):
        ax = axs[k]
        ax.set_xlim(-0.5, width + 0.5)
        ax.set_ylim(-0.175, 0.425)
        ax.axis("off")

        length = len(block[0][1])
        length_a = len(block[0][1].replace("-", ""))
        length_b = len(block[1][1].replace("-", ""))

        if show_position_numbers:
            ax.text(0, 0.435, offset_a, fontsize=10)
            offset_a += length_a
            ax.text(length, 0.435, offset_a - 1, fontsize=10, ha="right")
            ax.text(0, -0.12, offset_b, fontsize=10)
            offset_b += length_b
            ax.text(length, -0.12, offset_b - 1, fontsize=10, ha="right")

        draw_seq(ax, 0.2, block[0], block[1][1])
        draw_seq(ax, 0.1, block[1], block[0][1])
        draw_str(ax, 0.3, block[2], helix_yadd_a)
        draw_str(ax, 0.025, block[3], helix_yadd_b)
        if show_structure_strings:
            draw_seq(ax, 0.3, ("", block[2][1]))
            draw_seq(ax, 0, ("", block[3][1]))

    if len(block) > 4:
        for k, block in enumerate(aliblocks):
            ax = axs[k]
            draw_seq(ax, 0.375, ("", block[4][1].replace(".", " ")))
            draw_seq(ax, -0.075, ("", block[5][1].replace(".", " ")))
            draw_shifts(ax, block[4][1], block[5][1])
            if show_inconcruence:
                draw_incongruence(ax, block[4][1], block[5][1])

    if outname is not None:
        plt.savefig(outname)
    plt.show()
    return fig
