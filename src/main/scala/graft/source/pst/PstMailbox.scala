package graft.source.pst

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.model.MailboxSchema.Mode

/** Mode serializers over an open PST: the Spark analog of the
  * reference's row serializer (row_serializer.cpp:1211-1266) — maps MAPI
  * properties (public MS-OXPROPS ids) onto the MailboxSchema columns.
  * Values are produced as Catalyst-internal types keyed by column name;
  * the DSv2 reader projects the required columns.
  */
final class PstReader(pst: PstFile) {

  private def heapOf(e: NbtEntry) = new HeapNode(pst, e.bidData, e.bidSub)
  // point lookups (O(tree depth) pages), not the full NBT enumeration —
  // a task reading k nodes of a huge archive touches only its pages
  private def pcOf(nid: Long): Option[PropertyContext] =
    pst.nodeEntry(nid).flatMap { e =>
      try Some(new PropertyContext(heapOf(e)))
      catch { case scala.util.control.NonFatal(_) => None }
    }

  // ── store-level metadata (golden: pst_name = store display name) ───
  private val storePc = pcOf(0x21L)
  val storeName: String =
    storePc.flatMap(_.str(0x3001)).getOrElse("")
  val storeRecordKey: Array[Byte] =
    storePc.flatMap(_.binP(0x0FF9)).getOrElse(Array.emptyByteArray)

  private val named: Option[NamedPropMap] =
    pcOf(0x61L).map(new NamedPropMap(_))
  private def lid(guid: Array[Byte], l: Long): Int =
    named.flatMap(_.resolve(guid, l)).getOrElse(-1)

  // ── node enumeration (index-only, like the reference's planner) ────
  def folderNids: Seq[Long] =
    pst.nodes.valuesIterator.filter(_.nidType == 0x02).map(_.nid).toSeq.sorted
  def messageNids: Seq[Long] =
    pst.nodes.valuesIterator.filter(_.nidType == 0x04).map(_.nid).toSeq.sorted

  // one grouped pass over the node index (not a per-folder scan: a
  // folder-heavy store would make that quadratic)
  private lazy val childCounts: Map[(Long, Int), Long] =
    pst.nodes.valuesIterator
      .filter(e => e.nid != e.nidParent)
      .toSeq.groupBy(e => (e.nidParent, e.nidType))
      .map { case (k, es) => k -> es.size.toLong }

  private def childCount(parent: Long, types: Set[Int]): Long =
    types.iterator.map(t => childCounts.getOrElse((parent, t), 0L)).sum

  // ── helpers ────────────────────────────────────────────────────────
  private def s(v: String): UTF8String = if (v == null) null else UTF8String.fromString(v)

  /** PidTagSubject prefix convention: a leading 0x01 control char is
    * followed by a prefix-length byte; both are stripped.
    */
  private def cleanSubject(v: String): String =
    if (v != null && v.nonEmpty && v.charAt(0) == 1)
      v.substring(math.min(2, v.length))
    else v

  private def importanceEnum(v: Int): String = v match {
    case 0 => "LOW"; case 2 => "HIGH"; case _ => "NORMAL"
  }
  private def priorityEnum(v: Int): String = v match {
    case -1 => "NONURGENT"; case 1 => "URGENT"; case _ => "NORMAL"
  }
  private def sensitivityEnum(v: Int): String = v match {
    case 1 => "PERSONAL"; case 2 => "PRIVATE"; case 3 => "CONFIDENTIAL"; case _ => "NONE"
  }
  private def recipientTypeEnum(v: Int): String = v match {
    case 2 => "CC"; case 3 => "BCC"; case _ => "TO"
  }
  private def attachMethodEnum(v: Int): String = v match {
    case 0 => "NO_ATTACHMENT"; case 1 => "BY_VALUE"; case 2 => "BY_REFERENCE"
    case 3 => "BY_REF_RESOLVE"; case 4 => "BY_REF_ONLY"; case 5 => "EMBEDDED_MESSAGE"
    case 6 => "OLE"; case _ => "BY_VALUE"
  }

  // ── folders mode ───────────────────────────────────────────────────
  /** One folder row keyed by MailboxSchema column name. */
  def folderRow(nid: Long): Map[String, Any] = {
    val e  = pst.nodeEntry(nid).getOrElse(
      throw new IllegalStateException(s"unknown nid $nid"))
    val pc = pcOf(nid)
    // subfolder count = hierarchy-table children (includes search
    // folders, matching the reference's golden root count of 3)
    val subCount = childCount(nid, Set(0x02, 0x03))
    Map(
      "node_id"              -> nid,
      "parent_node_id"       -> e.nidParent,
      "record_key"           -> storeRecordKey,
      "container_class"      -> pc.flatMap(_.str(0x3613)).map(s).orNull,
      "display_name"         -> pc.flatMap(_.str(0x3001)).map(s).getOrElse(s("")),
      "subfolder_count"      -> subCount,
      "message_count"        -> pc.flatMap(_.i32p(0x3602)).map(_.toLong).getOrElse(childCount(nid, Set(0x04))),
      "unread_message_count" -> pc.flatMap(_.i32p(0x3603)).map(_.toLong).getOrElse(0L)
    )
  }

  // ── messages mode ──────────────────────────────────────────────────
  def messageClass(nid: Long): String =
    pcOf(nid).flatMap(_.str(0x001A)).getOrElse("")

  def messageRow(nid: Long, readAttachmentBody: Boolean): Map[String, Any] = {
    val e    = pst.nodeEntry(nid).getOrElse(
      throw new IllegalStateException(s"unknown nid $nid"))
    val heap = heapOf(e)
    val pc   = new PropertyContext(heap)
    val sub  = heap.subnodeMap

    // recipient table (subnode 0x692)
    val recipients: GenericArrayData = {
      val rows = tcRows(heap, 0x692L)
      new GenericArrayData(rows.map { case (tc, row) =>
        def cs(id: Int) = cellStr(tc, row, id)
        val rt = cellInt(tc, row, 0x0C15).getOrElse(1)
        new GenericInternalRow(Array[Any](
          s(cs(0x3001).orNull), s(cs(0x3A00).getOrElse(cs(0x3001).orNull)),
          s(cs(0x3003).orNull), s(cs(0x3002).orNull),
          s(recipientTypeEnum(rt)), rt))
      }.toArray[Any])
    }

    // attachment table (subnode 0x671) + attachment-object PCs
    val attachRows = tcRows(heap, 0x671L)
    val attachments: GenericArrayData = new GenericArrayData(attachRows.map {
      case (tc, row) =>
        val anid = tc.rowId(row)
        val apc = sub.get(anid).map { case (bd, bs) =>
          new PropertyContext(new HeapNode(pst, bd, bs))
        }
        def p(id: Int) = apc.flatMap(_.str(id))
        val method = apc.flatMap(_.i32p(0x3705)).getOrElse(1)
        new GenericInternalRow(Array[Any](
          s(p(0x3704).orElse(p(0x3707)).orNull),
          s(p(0x370E).orNull),
          apc.flatMap(_.i32p(0x0E20)).map(_.toLong).getOrElse(0L),
          s(p(0x3712).orNull),
          s(attachMethodEnum(method)),
          method == 5,
          if (readAttachmentBody) apc.flatMap(_.binP(0x3701)).orNull else null))
    }.toArray[Any])

    val flags = pc.i32p(0x0E07).getOrElse(0)
    val base = Map[String, Any](
      "node_id"              -> nid,
      "parent_node_id"       -> e.nidParent,
      "record_key"           -> pc.binP(0x0FF9).getOrElse(storeRecordKey),
      "subject"              -> s(cleanSubject(pc.str(0x0037).orNull)),
      "body"                 -> s(pc.str(0x1000).orNull),
      "body_html"            -> pc.get(0x1013).map(v => s(v.string)).orNull,
      "display_name"         -> s(pc.str(0x3001).orNull), // PR_DISPLAY_NAME (row_serializer.cpp:251-254)
      "comment"              -> s(pc.str(0x3004).orNull),
      "sender_name"          -> s(pc.str(0x0C1A).orNull),
      "sender_email_address" -> s(pc.str(0x0C1F).orNull),
      "recipients"           -> recipients,
      "has_attachments"      -> ((flags & 0x10) != 0 || attachRows.nonEmpty),
      "attachment_count"     -> attachRows.length.toLong,
      "attachments"          -> attachments,
      "importance"           -> s(importanceEnum(pc.i32p(0x0017).getOrElse(1))),
      "priority"             -> s(priorityEnum(pc.i32p(0x0026).getOrElse(0))),
      "sensitivity"          -> s(sensitivityEnum(pc.i32p(0x0036).getOrElse(0))),
      "creation_time"        -> pc.timeP(0x3007).map(Long.box).orNull,
      "last_modified"        -> pc.timeP(0x3008).map(Long.box).orNull,
      "message_delivery_time" -> pc.timeP(0x0E06).map(Long.box).orNull,
      "message_class"        -> s(pc.str(0x001A).orNull),
      "message_flags"        -> flags,
      "message_size"         -> pc.i32p(0x0E08).map(_.toLong).getOrElse(0L),
      "conversation_topic"   -> s(pc.str(0x0070).orNull),
      "internet_message_id"  -> s(pc.str(0x1035).orNull)
    )
    base ++ typedExtension(pc)
  }

  /** Typed-mode extension columns, resolved via the named-property map
    * where the property set requires it (MS-OXPROPS lids).
    */
  private def typedExtension(pc: PropertyContext): Map[String, Any] = {
    import NamedProps._
    val m = mutable.HashMap[String, Any]()
    def put(k: String, v: Any): Unit = if (v != null) m(k) = v
    def nstr(g: Array[Byte], l: Long): Option[String] =
      pc.str(lid(g, l))
    def ni32(g: Array[Byte], l: Long): Option[Int] = pc.i32p(lid(g, l))
    def nbool(g: Array[Byte], l: Long): Option[Boolean] = pc.boolP(lid(g, l))
    def ntime(g: Array[Byte], l: Long): Option[Long] = pc.timeP(lid(g, l))

    pc.str(0x001A).getOrElse("") match {
      case c if c.startsWith("IPM.Contact") =>
        val direct = Seq(
          "display_name_prefix" -> 0x3A45, "given_name" -> 0x3A06,
          "middle_name" -> 0x3A44, "surname" -> 0x3A11,
          "generation_suffix" -> 0x3A05, "initials" -> 0x3A0A,
          "nickname" -> 0x3A4F, "preferred_by_name" -> 0x3A47,
          "account_name" -> 0x3A00, "original_display_name" -> 0x3A13,
          "transmittable_display_name" -> 0x3A20, "mhs_common_name" -> 0x3A0F,
          "government_id_number" -> 0x3A07, "organizational_id_number" -> 0x3A10,
          "spouse_name" -> 0x3A48, "childrens_names" -> 0x3A58,
          "hobbies" -> 0x3A43, "profession" -> 0x3A46, "language" -> 0x3A0C,
          "location" -> 0x3A0D, "keyword" -> 0x3A0B, "company_name" -> 0x3A16,
          "title" -> 0x3A17, "department_name" -> 0x3A18,
          "office_location" -> 0x3A19, "manager_name" -> 0x3A4E,
          "assistant" -> 0x3A30, "customer_id" -> 0x3A4A,
          "primary_telephone" -> 0x3A1A, "business_telephone" -> 0x3A08,
          "business_telephone_2" -> 0x3A1B, "home_telephone" -> 0x3A09,
          "home_telephone_2" -> 0x3A2F, "mobile_telephone" -> 0x3A1C,
          "car_telephone" -> 0x3A1E, "radio_telephone" -> 0x3A1D,
          "pager_telephone" -> 0x3A21, "callback_number" -> 0x3A02,
          "other_telephone" -> 0x3A1F, "assistant_telephone" -> 0x3A2E,
          "company_main_phone" -> 0x3A57, "ttytdd_phone" -> 0x3A4B,
          "isdn_number" -> 0x3A2D, "telex_number" -> 0x3A2C,
          "primary_fax" -> 0x3A23, "business_fax" -> 0x3A24,
          "home_fax" -> 0x3A25,
          "home_address_street" -> 0x3A5D, "home_address_city" -> 0x3A59,
          "home_address_state" -> 0x3A5C, "home_address_postal_code" -> 0x3A5B,
          "home_address_country" -> 0x3A5A, "home_address_po_box" -> 0x3A5E,
          "other_address_street" -> 0x3A63, "other_address_city" -> 0x3A5F,
          "other_address_state" -> 0x3A62, "other_address_postal_code" -> 0x3A61,
          "other_address_country" -> 0x3A60, "other_address_po_box" -> 0x3A64,
          "postal_address" -> 0x3A15, "personal_home_page" -> 0x3A50,
          "business_home_page" -> 0x3A51, "ftp_site" -> 0x3A4C,
          "computer_network_name" -> 0x3A49)
        direct.foreach { case (col, id) => put(col, pc.str(id).map(s).orNull) }
        Seq("business_address_street" -> 0x8045L, "business_address_city" -> 0x8046L,
            "business_address_state" -> 0x8047L, "business_postal_code" -> 0x8048L,
            "business_address_country" -> 0x8049L, "business_po_box" -> 0x804AL)
          .foreach { case (col, l) => put(col, nstr(PSETID_Address, l).map(s).orNull) }
        put("gender", pc.get(0x3A4D).map(v => v.int16.toShort).orNull)
        put("birthday", pc.timeP(0x3A42).map(Long.box).orNull)
        put("wedding_anniversary", pc.timeP(0x3A41).map(Long.box).orNull)
        Seq("mail_permission" -> 0x3A0E, "send_rich_info" -> 0x3A40,
            "conversation_prohibited" -> 0x3A03, "disclose_recipients" -> 0x3A04)
          .foreach { case (col, id) => put(col, pc.boolP(id).map(Boolean.box).orNull) }

      case c if c.startsWith("IPM.Appointment") || c.startsWith("IPM.Schedule") =>
        put("location", nstr(PSETID_Appointment, 0x8208L).map(s).orNull)
        put("start_time", ntime(PSETID_Appointment, 0x820DL).map(Long.box).orNull)
        put("end_time", ntime(PSETID_Appointment, 0x820EL).map(Long.box).orNull)
        put("duration", ni32(PSETID_Appointment, 0x8213L).map(Int.box).orNull)
        put("all_day_event", nbool(PSETID_Appointment, 0x8215L).map(Boolean.box).orNull)
        put("busy_status", ni32(PSETID_Appointment, 0x8205L).map(Int.box).orNull)
        put("response_status", ni32(PSETID_Appointment, 0x8218L).map(Int.box).orNull)
        put("is_recurring", nbool(PSETID_Appointment, 0x8223L).map(Boolean.box).orNull)
        put("recurrence_pattern", nstr(PSETID_Appointment, 0x8232L).map(s).orNull)
        put("meeting_workspace_url", nstr(PSETID_Appointment, 0x8209L).map(s).orNull)
        put("is_meeting", ni32(PSETID_Appointment, 0x8217L).map(v => Boolean.box((v & 1) != 0)).orNull)
        put("organizer_name", pc.str(0x0C1A).map(s).orNull)
        put("required_attendees", pc.str(0x0E04).map(s).orNull)
        put("optional_attendees", pc.str(0x0E03).map(s).orNull)
        put("is_private", nbool(PSETID_Common, 0x8506L).map(Boolean.box).orNull)

      case c if c.startsWith("IPM.StickyNote") =>
        put("note_color", ni32(PSETID_Note, 0x8B00L).map(Int.box).orNull)
        put("note_width", ni32(PSETID_Note, 0x8B02L).map(Int.box).orNull)
        put("note_height", ni32(PSETID_Note, 0x8B03L).map(Int.box).orNull)
        put("note_x", ni32(PSETID_Note, 0x8B04L).map(Int.box).orNull)
        put("note_y", ni32(PSETID_Note, 0x8B05L).map(Int.box).orNull)

      case c if c.startsWith("IPM.Task") =>
        put("task_status", ni32(PSETID_Task, 0x8101L).map(Int.box).orNull)
        put("is_complete", nbool(PSETID_Task, 0x811CL).map(Boolean.box).orNull)
        put("percent_complete", pc.get(lid(PSETID_Task, 0x8102L)).map(v => Double.box(v.double)).orNull)
        put("start_date", ntime(PSETID_Task, 0x8104L).map(Long.box).orNull)
        put("due_date", ntime(PSETID_Task, 0x8105L).map(Long.box).orNull)
        put("date_completed", ntime(PSETID_Task, 0x810FL).map(Long.box).orNull)
        put("last_update", pc.timeP(0x3008).map(Long.box).orNull)
        put("estimated_effort", ni32(PSETID_Task, 0x8111L).map(Int.box).orNull)
        put("actual_effort", ni32(PSETID_Task, 0x8110L).map(Int.box).orNull)
        put("task_owner", nstr(PSETID_Task, 0x811FL).map(s).orNull)
        put("task_assigner", nstr(PSETID_Task, 0x8121L).map(s).orNull)
        put("ownership", ni32(PSETID_Task, 0x8129L).map(Int.box).orNull)
        put("last_user", nstr(PSETID_Task, 0x8122L).map(s).orNull)
        put("is_team_task", nbool(PSETID_Task, 0x8103L).map(Boolean.box).orNull)
        put("is_recurring", nbool(PSETID_Task, 0x8126L).map(Boolean.box).orNull)

      case c if c.startsWith("IPM.DistList") =>
        val members = pc.get(lid(PSETID_Address, 0x8055L)).map(_.multiBytes).getOrElse(Nil)
        val nids = members.flatMap(entryIdNid)
        put("member_node_ids", new GenericArrayData(nids.toArray[Any]))
        val oneOffs = pc.get(lid(PSETID_Address, 0x8054L)).map(_.multiBytes).getOrElse(Nil)
        put("one_off_members", new GenericArrayData(oneOffs.flatMap(parseOneOff).toArray[Any]))

      case _ => ()
    }
    m.toMap
  }

  /** A store-internal EntryID's node id lives in its trailing 4 bytes
    * (reference row_serializer.cpp:1128-1205).
    */
  private def entryIdNid(b: Array[Byte]): Option[Long] =
    if (b.length >= 4) Some(Lit.u32(b, b.length - 4)) else None

  /** One-off EntryID blob (MS-OXCDATA): flags(4) + one-off provider
    * UID(16) + version(2) + flags(2, bit 0x8000 = UTF-16) +
    * display\0 addrtype\0 email\0.
    */
  private def parseOneOff(b: Array[Byte]): Option[GenericInternalRow] = {
    if (b.length < 24) return None
    val flags   = Lit.u16(b, 22)
    val unicode = (flags & 0x8000) != 0
    val payload = java.util.Arrays.copyOfRange(b, 24, b.length)
    val parts: Seq[String] =
      if (unicode) {
        val text = new String(payload, java.nio.charset.StandardCharsets.UTF_16LE)
        text.split('\u0000').toSeq
      } else new String(payload, java.nio.charset.StandardCharsets.ISO_8859_1).split('\u0000').toSeq
    if (parts.length < 3) None
    else Some(new GenericInternalRow(Array[Any](s(parts(0)), s(parts(1)), s(parts(2)))))
  }

  // ── TC helpers ─────────────────────────────────────────────────────
  private def tcRows(heap: HeapNode, subNid: Long): Seq[(TableContext, Array[Byte])] =
    heap.subnodeMap.get(subNid) match {
      case None => Nil
      case Some((bd, bs)) =>
        try {
          val tc = new TableContext(pst, new HeapNode(pst, bd, bs))
          tc.rows.map(r => (tc, r))
        } catch { case scala.util.control.NonFatal(_) => Nil }
    }

  private def cellStr(tc: TableContext, row: Array[Byte], propId: Int): Option[String] =
    tc.cols.find(_.propId == propId).flatMap(c => tc.cell(row, c)).map(_.string).filter(_.nonEmpty)
  private def cellInt(tc: TableContext, row: Array[Byte], propId: Int): Option[Int] =
    tc.cols.find(_.propId == propId).flatMap(c => tc.cell(row, c)).map(_.int32)
}
