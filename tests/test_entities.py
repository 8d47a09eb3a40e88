"""Golden-string tests for the entity extractors (FIXTURES.md F4 / M6-M10)."""

from khl_pdf_ocr_ray.functions.entities import (
    find_date,
    find_match_meta,
    find_ref_lines,
    find_time,
    goalies_from_column,
    goalies_from_ocr_lines,
    refs_from_ocr_lines,
    top_caps_team,
)


def test_date_numeric_wins_first():
    lines = ["intro", "Матч 05.09.2023 в Москве", "12 сентября 2023"]
    assert find_date(lines) == "05.09.2023"


def test_date_russian_longform():
    assert find_date(["игра 5 сентября 2023 г."]) == "5 сентября 2023"


def test_date_only_first_160_lines():
    lines = ["x"] * 160 + ["01.01.2024"]
    assert find_date(lines) == ""


def test_time_bounds():
    assert find_time(["24:00 25:99 23:59"]) == "23:59"
    assert find_time(["9:30"]) == ""  # needs two-digit hour
    assert find_time(["09:30"]) == "09:30"


def test_top_caps_team_top_quarter_longest():
    # y-range 0..100 -> cut at 25; CAPS line below the cut is ignored
    words = (
        [(10.0, float(i * 30), t) for i, t in enumerate(["ХК", "АВАНГАРД"])]
        + [(20.0, 0.0, "СПАРТАК0")]  # shorter CAPS candidate
        + [(80.0, 0.0, "МЕТАЛЛУРГ"), (100.0, 0.0, "низ")]
    )
    assert top_caps_team(words) == "ХК АВАНГАРД"
    assert top_caps_team([]) == ""


def test_find_match_meta_shape():
    meta = find_match_meta(["01.02.2023 19:30"], {"left": [], "right": []})
    assert meta == {
        "date": "01.02.2023",
        "time_msk": "19:30",
        "teams": {"home": "", "away": ""},
    }


def test_refs_buffered_pairing():
    lines = [
        "Главный судья Линейный судья",
        "Иванов Пётр, Сидоров Алексей | Козлов Дмитрий; Орлов Семён Обновлено 01.01.2024",
    ]
    main, linesmen, dbg = find_ref_lines(lines)
    assert main == ["Иванов Пётр", "Сидоров Алексей"]
    assert linesmen == ["Козлов Дмитрий", "Орлов Семён"]
    assert "raw_ref_line" in dbg


def test_refs_buffer_resets_on_non_name():
    lines = ["Главный судья и Линейный судья", "Иванов 12 Пётр Сидоров Козлов Орлов Глебов Семёнов Волков"]
    main, linesmen, _ = find_ref_lines(lines)
    # buffered pairing yields 3 names (buffer resets on "12") -> < 4, so the
    # sliding-window fallback replaces them with the first 4 adjacent pairs
    assert main == ["Пётр Сидоров", "Сидоров Козлов"]
    assert linesmen == ["Козлов Орлов", "Орлов Глебов"]


def test_refs_sliding_fallback():
    # only 3 buffered pairs impossible: tokens with separator resets leaving <4,
    # but sliding window over adjacent name tokens yields >= 4
    lines = ["Главный судья / Линейный судья", "Иванов Пётр Сидоров Алексей Козлов"]
    main, linesmen, _ = find_ref_lines(lines)
    # buffered gives 2 names only -> sliding: 4 adjacent pairs
    assert main == ["Иванов Пётр", "Пётр Сидоров"]
    assert linesmen == ["Сидоров Алексей", "Алексей Козлов"]


def test_refs_header_not_found():
    assert find_ref_lines(["nothing here"]) == ([], [], {"note": "ref header not found"})


def test_refs_header_must_be_in_first_100_lines():
    lines = ["x"] * 100 + ["Главный судья Линейный судья", "Иванов Пётр Сидоров Алексей"]
    assert find_ref_lines(lines)[0] == []


def test_ocr_refs_unquantified_split_and_sliding_only():
    ocr = [
        "шапка",
        "Главный судья Линейный судья",
        "Иванов Пётр Сидоров Алексей Козлов",
    ]
    main, linesmen, raw = refs_from_ocr_lines(ocr)
    assert main == ["Иванов Пётр", "Пётр Сидоров"]
    assert linesmen == ["Сидоров Алексей", "Алексей Козлов"]
    assert raw == ocr[2]
    # fewer than 4 sliding candidates -> nothing
    assert refs_from_ocr_lines(["Главный судья Линейный судья", "Иванов Пётр"])[0] == []


def test_goalies_column_flags_and_stop():
    col = [
        (10.0, 0.0, "Вратари"),
        (22.0, 0.0, "30"),
        (22.0, 10.0, "Петров"),
        (22.0, 40.0, "Иван"),
        (22.0, 80.0, "С"),
        (34.0, 0.0, "31"),
        (34.0, 10.0, "Смирнов"),
        (34.0, 40.0, "Олег"),
        (34.0, 80.0, "Р"),
        (46.0, 0.0, "Звено"),
        (46.0, 30.0, "1"),
        (58.0, 0.0, "Козлов"),
        (58.0, 40.0, "Дмитрий"),
    ]
    out = goalies_from_column(col)
    assert out == [
        {"name": "Петров Иван", "flag": "C"},
        {"name": "Смирнов Олег", "flag": "R"},
    ]


def test_goalies_no_header():
    assert goalies_from_column([(1.0, 0.0, "Петров"), (1.0, 10.0, "Иван")]) == []
    assert goalies_from_column([]) == []


def test_goalies_three_part_name_no_flag():
    col = [(10.0, 0.0, "Вратари"), (22.0, 0.0, "Петров"), (22.0, 30.0, "Иван"), (22.0, 60.0, "Олегович")]
    assert goalies_from_column(col) == [{"name": "Петров Иван Олегович", "flag": ""}]


def test_goalies_from_ocr_lines_no_header_needed():
    lines = ["мусор", "77 Волков Глеб С обновлено", "Звено 1", "Орлов Семён"]
    out = goalies_from_ocr_lines(lines)
    # OCR variant has no stop marker: collects past "Звено"
    assert out == [
        {"name": "Волков Глеб", "flag": "C"},
        {"name": "Орлов Семён", "flag": ""},
    ]
